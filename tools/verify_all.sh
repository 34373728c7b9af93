#!/usr/bin/env bash
# End-to-end verification drives for gan_lib_tensorflow_tpu (see
# .claude/skills/verify/SKILL.md for environment notes). Each step runs a REAL
# surface: CLIs on the accelerator, the multichip dryrun on virtual devices.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
OUT=${OUT:-/tmp/gantpu_verify}

echo "== 1. SNGAN train (20 steps) + resume =="
python -m gan_lib_tensorflow_tpu.cli.train_sngan --steps 20 --log-every 10 \
  --sample-every 20 --ckpt-every 20 --out-dir "$OUT/sngan" --data device-fake
python -m gan_lib_tensorflow_tpu.cli.train_sngan --steps 30 --log-every 10 \
  --sample-every 30 --ckpt-every 30 --out-dir "$OUT/sngan" --data device-fake | grep resumed

echo "== 2. sample + serving export + evaluate from checkpoint =="
python -m gan_lib_tensorflow_tpu.cli.sample --model sngan \
  --ckpt-dir "$OUT/sngan/ckpt" --out "$OUT/sngan/grid.png" --n 16 \
  --export-dir "$OUT/sngan/export"
test -s "$OUT/sngan/export/generator_stablehlo.bin"
python -m gan_lib_tensorflow_tpu.cli.evaluate --model sngan \
  --ckpt-dir "$OUT/sngan/ckpt" --n-samples 500 --n-real 500 --data fake

echo "== 3. ACGAN (CPU-runnable config) =="
python -m gan_lib_tensorflow_tpu.cli.train_acgan --steps 5 --log-every 5 \
  --sample-every 1000000 --ckpt-every 1000000 --out-dir "$OUT/acgan" --data fake

echo "== 4. pix2pix train/test/export =="
python -m gan_lib_tensorflow_tpu.cli.train_pix2pix --mode train --steps 4 \
  --log-every 2 --sample-every 4 --ckpt-every 4 --out-dir "$OUT/p2p" --data fake
python -m gan_lib_tensorflow_tpu.cli.train_pix2pix --mode test \
  --out-dir "$OUT/p2p" --data fake --max-test-images 2
python -m gan_lib_tensorflow_tpu.cli.train_pix2pix --mode export --out-dir "$OUT/p2p" --data fake

echo "== 5. PGGAN ladder 4->16 (s2d-from 8: every stage's top level runs the S2D path) =="
python -m gan_lib_tensorflow_tpu.cli.train_pggan --final-resolution 16 \
  --width-mul 0.0625 --z-dim 64 --steps-per-phase 2 --log-every 1 --s2d-from 8 \
  --sample-every 1000000 --ckpt-every 1000000 --out-dir "$OUT/pggan" --data fake

echo "== 6. multichip dryrun (8 virtual CPU devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import jax; jax.config.update('jax_platforms','cpu'); import __graft_entry__ as e; e.dryrun_multichip(8)"

echo "== 6b. DP x TP via the stock CLI (data=4 x model=2 mesh, virtual devices) =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import jax; jax.config.update('jax_platforms','cpu'); \
from gan_lib_tensorflow_tpu.cli import train_sngan; \
train_sngan.main(['--steps','2','--log-every','1','--sample-every','2', \
 '--ckpt-every','2','--out-dir','$OUT/sngan_tp','--compute-dtype','fp32', \
 '--batch-size','8','--n-critic','1','--data','fake','--tp-shards','2'])"
test -s "$OUT/sngan_tp/log.jsonl"

echo "== 7. north-star harness (smoke: synthetic stand-ins, UNGRADED) =="
python -m gan_lib_tensorflow_tpu.cli.north_star --smoke \
  --out-dir "$OUT/north_star" | tee "$OUT/north_star.out"
grep -q "UNGRADED" "$OUT/north_star.out"

echo "== 8. bench =="
python bench.py

echo "ALL VERIFICATION DRIVES PASSED"
