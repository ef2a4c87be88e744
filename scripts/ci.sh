#!/usr/bin/env bash
# CI: native build (+ASAN variant), full test matrix on CPU (8 fake devices).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native build =="
make -C sparse_rcnn_tpu/native clean libsparse_host.so

echo "== native ASAN build (sanitizer config, SURVEY.md §5) =="
make -C sparse_rcnn_tpu/native clean
make -C sparse_rcnn_tpu/native ASAN=1 libsparse_host.so
make -C sparse_rcnn_tpu/native clean
make -C sparse_rcnn_tpu/native libsparse_host.so

echo "== tests (CPU, fake 8 devices) =="
python -m pytest tests/ -q

echo "== driver entries =="
python -c "
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry(); fn(*args)
g.dryrun_multichip(8)
print('entries OK')
"
echo "CI OK"
