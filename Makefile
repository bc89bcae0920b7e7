# Build / test / bench entry points (the L5 tier of SURVEY.md's layer map;
# the reference's equivalents are the Vitis HLS + Vivado tcl scripts).

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC
NATIVE := csrc/build/libsgrace_host.so

.PHONY: all native test test-fast bench sweep dist clean

all: native

native: $(NATIVE)

$(NATIVE): csrc/sgrace_host.cpp
	mkdir -p csrc/build
	$(CXX) $(CXXFLAGS) -o $@ $<

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -m "not slow"

# headline benchmark on the real TPU (one JSON line; used by the driver)
bench: native
	python bench.py

# backend sweeps on the real TPU
sweep: native
	python benchmarks/bench_spmm.py
	python benchmarks/bench_gat.py
	python benchmarks/bench_int8.py

# multi-device scaling on the virtual CPU mesh (same code runs on a slice)
dist:
	python benchmarks/bench_scaling.py
	python benchmarks/bench_dist_train.py

clean:
	rm -rf csrc/build sgracex1_tpu.egg-info build dist
