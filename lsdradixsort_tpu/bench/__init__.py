from lsdradixsort_tpu.bench.runner import run_suite, SUITES  # noqa: F401
