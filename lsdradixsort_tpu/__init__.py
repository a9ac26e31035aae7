"""lsdradixsort_tpu — a TPU-native vectorized sort / query-execution engine.

A from-scratch JAX/Pallas/shard_map framework with the capabilities of the
reference CUDA benchmark program (emanuele-xyz/LSDRadixSort): an LSD radix
sort built from composable primitives — per-block digit histograms,
hierarchical exclusive prefix sums, stable rank-and-scatter passes, and
tiled transposes — extended into a columnar query-execution operator set
(sort, filter, hash aggregate, hash join) that scales over a multi-host TPU
slice via psum'd global histograms and all-to-all radix shuffles.

Layer map (mirrors reference layering, SURVEY.md §1):
  core/      platform utils: digit math, data gen, timing, roofline model
  golden/    numpy oracle implementations (reference L3: LSDRadixSort.cu:25-139)
  kernels/   Pallas TPU kernels (reference L1: LSDRadixSort.cu:141-837)
  ops/       jitted operator pipelines (reference L2: LSDRadixSort.cu:839-910)
  parallel/  device-mesh distribution: psum histograms, all-to-all shuffle
  bench/     benchmark harness + CLI (reference L4/L5: LSDRadixSort.cu:912-1185)
"""

from lsdradixsort_tpu.core import digits, datagen, timing, roofline
from lsdradixsort_tpu.ops.sort import (sort, sort_kv, argsort,
                                       sort_with_ranks, sort64_with_ranks, sort_lex,
                                       sort_blocks_kv,
                                       merge_sort_keys, merge_sort_with_ranks,
                                       merge_sort_multi)
from lsdradixsort_tpu.ops.filter import (filter_keys, filter_kv,
                                         filter_in_set, filter_not_in_set,
                                         compact)
from lsdradixsort_tpu.ops.aggregate import group_by_sum, group_by_aggregate
from lsdradixsort_tpu.ops.join import (hash_join, hash_join_multi,
                                       probe_lookup, probe_lookup64,
                                       hash_join64)
from lsdradixsort_tpu.ops.topk import top_k, unique
from lsdradixsort_tpu.ops.window import window_rank
from lsdradixsort_tpu.kernels.histogram import digit_histogram, block_digit_histograms
from lsdradixsort_tpu.kernels.scan import exclusive_scan, block_prefix_sums
from lsdradixsort_tpu.kernels.tile_sort import (sort_tiles, sort_tiles_kv,
                                                sort_tiles_multi)
from lsdradixsort_tpu.kernels.shuffle import shuffle_row_runs
from lsdradixsort_tpu.kernels.fill_forward import fill_forward_last

__version__ = "0.2.0"

__all__ = [
    "sort", "sort_kv", "argsort", "sort_with_ranks",
    "sort64_with_ranks", "sort_lex", "sort_blocks_kv",
    "merge_sort_keys", "merge_sort_with_ranks", "merge_sort_multi",
    "sort_tiles", "sort_tiles_kv", "sort_tiles_multi",
    "shuffle_row_runs", "fill_forward_last",
    "filter_keys", "filter_kv", "filter_in_set", "filter_not_in_set",
    "compact",
    "group_by_sum", "group_by_aggregate",
    "hash_join", "hash_join_multi", "probe_lookup", "probe_lookup64",
    "hash_join64", "top_k", "unique", "window_rank",
    "digit_histogram", "block_digit_histograms",
    "exclusive_scan", "block_prefix_sums",
    "digits", "datagen", "timing", "roofline",
]
