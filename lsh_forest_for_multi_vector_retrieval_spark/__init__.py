"""PySpark-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the query semantics of
`YuvalShemla/lsh-forest-for-multi-vector-retrieval` (reference read-only at
/root/reference) as a web-scale dedup engine:

* shingling + MinHash-128 + SimHash-64 signatures (reference hashing layer,
  ``src/shared/lsh_family.py:19-42``, ``src/shared/lsh_forest.py:15-32``)
* LSH band tables = the reference's forest of tries materialized as sorted
  ``(band_id, band_hash, doc_id)`` DataFrames (``src/shared/lsh_forest.py:36-64``)
* candidate generation = bucket self-grouping (the reference's
  DESCEND/SYNCHASCEND query, ``src/shared/lsh_forest.py:76-139``)
* exact-Jaccard verification (the reference's exact re-rank,
  ``src/shared/lsh_forest.py:106-108``)
* connected-components clustering over verified pairs
* depth-weighted scoring / chamfer / ranking analogs of
  ``src/shared/forest_vote.py`` and ``src/shared/retrieval.py``

Everything is DataFrame/Catalyst-first; Python appears only in Arrow-batched
pandas UDFs (signatures) — no per-row Python anywhere.
"""

from lsh_forest_for_multi_vector_retrieval_spark.config import DedupConfig
from lsh_forest_for_multi_vector_retrieval_spark.session import get_spark


def minhash_dedup(*args, **kwargs):
    """Convenience re-export of the flagship pipeline (lazy import keeps
    ``import lsh_forest_for_multi_vector_retrieval_spark`` light)."""
    from lsh_forest_for_multi_vector_retrieval_spark.operators.dedup import (
        minhash_dedup as _impl,
    )

    return _impl(*args, **kwargs)


__all__ = ["DedupConfig", "get_spark", "minhash_dedup"]
__version__ = "0.1.0"
