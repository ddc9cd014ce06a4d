"""tdigest_spark — a from-scratch PySpark-native approximate-aggregation
library with the query surface of tvondra/tdigest (plus HLL, count-min,
KLL and Bloom companion sketches), built on the DataFrame API and
Arrow-vectorized pandas UDFs.

Architecture (SURVEY.md §7): a pure-NumPy kernel per sketch under
``tdigest_spark.kernel``; one shared two-phase mergeable-aggregate
pipeline (Arrow-batch partials — pyarrow split reader or ``mapInArrow``
— shuffled as tiny binaries into a repartition-by-key merge+finalize)
under ``tdigest_spark.spark``; training-data-pipeline operators (dedup,
similarity, text analysis, multimodal plumbing) as sibling modules.
"""

from tdigest_spark.kernel.bloom import Bloom  # noqa: F401
from tdigest_spark.kernel.countmin import CountMin  # noqa: F401
from tdigest_spark.kernel.hll import HLL  # noqa: F401
from tdigest_spark.kernel.kll import KLL  # noqa: F401
from tdigest_spark.kernel.tdigest import TDigest  # noqa: F401
from tdigest_spark.spark.sketches import (  # noqa: F401
    bloom_filter,
    bloom_might_contain,
    countmin_estimate,
    countmin_sketch,
    hll_cardinality,
    hll_count_distinct,
    hll_sketch,
    hll_union_agg,
    kll_quantile,
    kll_rank,
    kll_sketch,
)
from tdigest_spark.spark.topk_agg import (  # noqa: F401
    reservoir_sample_hashes,
    topk,
    topk_sketch,
)
from tdigest_spark.spark.tdigest_agg import (  # noqa: F401
    tdigest,
    tdigest_avg,
    tdigest_avg_digests,
    tdigest_count_agg,
    tdigest_percentile,
    tdigest_percentile_digests,
    tdigest_percentile_of,
    tdigest_percentile_of_digests,
    tdigest_rollup,
    tdigest_sum,
    tdigest_sum_digests,
    tdigest_union_agg,
)

__version__ = "0.1.0"
