from lsdradixsort_tpu.kernels.histogram import digit_histogram, block_digit_histograms  # noqa: F401
from lsdradixsort_tpu.kernels.scan import (exclusive_scan, block_prefix_sums,  # noqa: F401
                                            exclusive_scan_hierarchical)
from lsdradixsort_tpu.kernels.transpose import transpose  # noqa: F401
from lsdradixsort_tpu.kernels.tile_sort import sort_tiles, sort_tiles_kv  # noqa: F401
from lsdradixsort_tpu.kernels.shuffle import shuffle_row_runs  # noqa: F401
from lsdradixsort_tpu.kernels.fill_forward import fill_forward_last  # noqa: F401
