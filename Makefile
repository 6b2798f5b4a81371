# Build / test / lint entry points (reference: Makefile:1-20)

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC -pthread -Wall

.PHONY: all native tests lint ci clean docs

all: native

native: allrank_tpu/native/libsvm_parser.so allrank_tpu/native/slate_assembler.so allrank_tpu/native/libsvm_writer.so

allrank_tpu/native/libsvm_parser.so: allrank_tpu/native/libsvm_parser.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

allrank_tpu/native/slate_assembler.so: allrank_tpu/native/slate_assembler.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

allrank_tpu/native/libsvm_writer.so: allrank_tpu/native/libsvm_writer.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

tests:
	python -m pytest tests/ -q

# flake8/mypy are not in this image and installs are disallowed; tools/lint.py
# enforces a pyflakes-subset (syntax, E501, F401/F403/F811, whitespace) with
# stdlib ast and FAILS the build on findings (reference ci enforces lint too,
# reference Makefile:4-9)
lint:
	python tools/lint.py allrank_tpu tests tools

wheel:
	pip wheel --no-deps --no-build-isolation -w dist/ .

docs:
	python tools/gen_api_docs.py

ci: native lint tests

clean:
	rm -f allrank_tpu/native/*.so
	rm -rf dist build *.egg-info
