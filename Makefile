CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC

all: cpp/build/libnms1d.so

cpp/build/libnms1d.so: cpp/nms1d.cc
	mkdir -p cpp/build
	$(CXX) $(CXXFLAGS) $< -o $@

# fast default lane: deselects multi-process / multi-device / end-to-end
# pipeline / overfit tests (marked `slow`) to keep iteration under ~15
# minutes on this 1-core host; `make test-all` runs everything.
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf cpp/build

.PHONY: all test bench clean
