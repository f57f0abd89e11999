#!/bin/bash
# Local CI entry point: build native lib, run the full suite.
set -e
make -C "$(dirname "$0")/native"
python -m pytest "$(dirname "$0")/tests" -x -q -m ''  # full suite incl. slow
