CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC

all: cpp/build/libnms1d.so

cpp/build/libnms1d.so: cpp/nms1d.cc
	mkdir -p cpp/build
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf cpp/build

.PHONY: all test bench clean
