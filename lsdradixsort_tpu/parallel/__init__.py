from lsdradixsort_tpu.parallel.mesh import make_mesh, shard_1d  # noqa: F401
from lsdradixsort_tpu.parallel.dist_sort import dist_sort, dist_sort_kv  # noqa: F401
from lsdradixsort_tpu.parallel.dist_hist import dist_digit_histogram  # noqa: F401
