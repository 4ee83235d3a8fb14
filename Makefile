# rt3d build + test entry points

.PHONY: native test test-fast bench demo clean

native:
	g++ -O2 -shared -fPIC -o native/librt3d_replayer.so native/replayer.cpp -lpthread

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	PYTHONPATH=.:$$PYTHONPATH python bench.py

demo:
	PYTHONPATH=.:$$PYTHONPATH python tools/demo_geometry.py

clean:
	rm -f native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
