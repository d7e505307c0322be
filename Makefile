# Local CI targets. `verify-sf001` is the round gate: the full DuckDB
# differential at the DRIVER's grain (sf0.01) — ties/rounding that hide
# at 6k lineitem rows surface at 60k, so every round runs it once before
# shipping. Plain `test` runs everything at sf0.001.

.PHONY: test verify-sf001 bench operators

test:
	python -m pytest tests/ -q

verify-sf001:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_diff.py -q

bench:
	python bench.py

operators:
	python -m azure_batch_map_reduce_spark.registry
