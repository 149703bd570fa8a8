.PHONY: test fuzz-ci bench scaling oracle

test:
	python -m pytest tests/ -x -q

# standing differential-fuzz sweep vs the real reference under node
# (~4-5 min; the per-suite 120-seed slice runs in tests/test_fuzz_ci.py)
fuzz-ci:
	python tools/fuzz_spec.py 1000 0

bench:
	python bench.py

scaling:
	python bench.py --scaling

oracle:
	python tools/check_oracle.py /root/testdata/sf0.001
