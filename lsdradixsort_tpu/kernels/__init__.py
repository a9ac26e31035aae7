from lsdradixsort_tpu.kernels.histogram import digit_histogram, block_digit_histograms  # noqa: F401
from lsdradixsort_tpu.kernels.scan import (exclusive_scan, block_prefix_sums,  # noqa: F401
                                            exclusive_scan_hierarchical)
from lsdradixsort_tpu.kernels.transpose import transpose  # noqa: F401
from lsdradixsort_tpu.kernels.tile_sort import (sort_tiles, sort_tiles_kv,  # noqa: F401
                                                sort_tiles_multi,
                                                bitonic_network)
from lsdradixsort_tpu.kernels.compaction import (compact_stream,  # noqa: F401
                                                 compact_stream_multi)
from lsdradixsort_tpu.kernels.merge import (merge_pass, merge_pass_kv,  # noqa: F401
                                            merge_pass_multi,
                                            merge_pass_tables)
from lsdradixsort_tpu.kernels.shuffle import shuffle_row_runs  # noqa: F401
from lsdradixsort_tpu.kernels.fill_forward import fill_forward_last  # noqa: F401
