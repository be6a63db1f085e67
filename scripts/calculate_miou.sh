#!/bin/bash
# Reference Calculate_mIoU.sh equivalent.
set -e
python -m pnp_ovss_tpu.evalx.aggregate --save_path "${1:?save_path}" --data_type "${2:?data_type}"
