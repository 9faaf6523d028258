#!/bin/sh
# Package the library for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f fts.zip
zip -qr fts.zip fulltextsearch_spark -x '*__pycache__*'
echo "wrote $(pwd)/fts.zip"
