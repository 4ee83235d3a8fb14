# rt3d build + test entry points

.PHONY: native test test-fast bench demo clean

native:
	g++ -O2 -shared -fPIC -o native/librt3d_replayer.so native/replayer.cpp -lpthread

# tests must run on a REAL 8-device CPU mesh: scrub the TPU-tunnel site
# hooks (tests/conftest.py also self-corrects via re-exec, but invoking
# with the right env gives live output)
TEST_ENV = env -u PALLAS_AXON_POOL_IPS RT3D_TEST_REEXEC=1 JAX_PLATFORMS=cpu \
  PYTHONPATH=. XLA_FLAGS="--xla_force_host_platform_device_count=8"

# usage: make test [ARGS="tests/test_foo.py -k bar"]
test:
	$(TEST_ENV) python -m pytest $(or $(ARGS),tests/) -q

test-fast:
	$(TEST_ENV) python -m pytest tests/ -q -x -m "not slow"

bench:
	PYTHONPATH=.:$$PYTHONPATH python bench.py

demo:
	PYTHONPATH=.:$$PYTHONPATH python tools/demo_geometry.py

clean:
	rm -f native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
