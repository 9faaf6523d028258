#pragma once
namespace parquet { namespace arrow { class FileReader {}; } }
