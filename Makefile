# Developer entry points

.PHONY: test test-fast bench smoke dryrun native tpu-smoke

# MANDATORY before landing any Pallas-kernel or train-step change:
# compiles + runs every kernel entry point at production shapes on the
# REAL TPU backend (interpret-mode tests cannot see Mosaic scoped-VMEM
# or matmul-precision behaviour — VERDICT r3/r4).
tpu-smoke:
	python tools/tpu_smoke.py

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

smoke:
	python tools/smoke_train.py 5

dryrun:
	JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python __graft_entry__.py

native:
	g++ -O2 -shared -fPIC -o native/build/libmmseg_dicom.so native/mmseg_dicom.cpp
