from lsdradixsort_tpu.bench.runner import main

main()
