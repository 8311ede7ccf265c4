# surtr_tpu build + test entry points.

CXX ?= g++
CXXFLAGS ?= -O2 -std=c++17 -shared -fPIC -Wall

NATIVE := surtr_tpu/native/libsurtr_native.so

.PHONY: all native test test-fast bench clean

all: native

native: $(NATIVE)

$(NATIVE): surtr_tpu/native/objloader.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

# Tests run on the CPU backend with 8 virtual devices; PYTHONPATH is cleared
# so the axon TPU plugin does not dial its relay for CPU-only runs.
# `test` = the fast default (pytest.ini gates -m "not slow");
# `test-all` = everything, including the model-scale/pile slow marks.
test:
	PYTHONPATH= python -m pytest tests/ -x -q

test-all:
	PYTHONPATH= python -m pytest tests/ -x -q -m ""

bench:
	python bench.py

clean:
	rm -f $(NATIVE)
