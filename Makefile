# Convenience targets (the reference's CMake exposes `make run`;
# CMakeLists.txt:21-23 — here the build is `pip install -e .` and the native
# I/O library self-builds on first use).

PY ?= python

.PHONY: install test run bench check native clean

install:
	pip install -e . --no-deps --no-build-isolation

test:
	$(PY) -m pytest tests/ -q

run:
	$(PY) -m poroelasticity_dealii_tpu run configs/golden_2d.data

bench:
	$(PY) bench.py

check:
	$(PY) -m poroelasticity_dealii_tpu check configs/golden_2d.data

native:
	mkdir -p build
	g++ -O3 -shared -fPIC -std=c++17 -o build/libporomeshio.so native/meshio.cpp

clean:
	rm -rf build .pytest_cache solution checkpoints
	find . -name __pycache__ -type d -exec rm -rf {} +
