from lsdradixsort_tpu.ops.sort import sort, sort_kv, argsort  # noqa: F401
from lsdradixsort_tpu.ops.filter import (filter_keys, filter_kv,  # noqa: F401
                                         filter_in_set, filter_not_in_set,
                                         compact)
from lsdradixsort_tpu.ops.aggregate import (group_by_sum, group_by_aggregate,  # noqa: F401
                                            filtered_group_by_sum)
from lsdradixsort_tpu.ops.join import (hash_join, hash_join_multi,  # noqa: F401
                                       probe_lookup, probe_lookup64,
                                       hash_join64)
from lsdradixsort_tpu.ops.topk import top_k, unique  # noqa: F401
from lsdradixsort_tpu.ops.window import window_rank  # noqa: F401
from lsdradixsort_tpu.ops.sort import (sort_with_ranks,  # noqa: F401
                                       sort64_with_ranks, sort_lex,
                                       sort_blocks_kv)
from lsdradixsort_tpu.ops.sort import (merge_sort_keys,  # noqa: F401
                                       merge_sort_with_ranks,
                                       merge_sort_multi)
from lsdradixsort_tpu.ops.bigsort import (sort_kv_chunked,  # noqa: F401
                                          sort_with_ranks_chunked,
                                          merge_runs_chunked)
