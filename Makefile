# Build / test / lint entry points (reference: Makefile:1-20)

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC -pthread -Wall

.PHONY: all native tests lint ci clean

all: native

native: allrank_tpu/native/libsvm_parser.so

allrank_tpu/native/libsvm_parser.so: allrank_tpu/native/libsvm_parser.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

tests:
	python -m pytest tests/ -q

lint:
	python -m flake8 --max-line-length 120 allrank_tpu tests || true

wheel:
	pip wheel --no-deps --no-build-isolation -w dist/ .

ci: native lint tests

clean:
	rm -f allrank_tpu/native/libsvm_parser.so
	rm -rf dist build *.egg-info
