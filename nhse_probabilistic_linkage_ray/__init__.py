"""Ray-Data-native near-duplicate detection + clustering engine for source code.

A from-scratch re-expression of the query / data-processing capabilities of
nhsengland/NHSE_probabilistic_linkage (a Splink / Fellegi-Sunter probabilistic
record-linkage pipeline on Spark), recast as code dedup at very large scale:

- content normalization + shingling  (ref: utils/preprocessing_utils.py name &
  postcode cleaning)
- MinHash / LSH band hashing as the blocking stage  (ref: Splink blocking
  rules, parameters_dedupe.py:26-44)
- tiered verification: exact Jaccard, SimHash Hamming, longest-common-substring
  (ref: Splink comparison levels, utils/parameter_lists.py)
- Fellegi-Sunter style match weights over tier outcomes  (ref: Splink scoring)
- distributed connected-components clustering  (ref: find_connected_ids,
  utils/dataset_ingestion_utils.py:487-540 and Splink's
  cluster_pairwise_predictions_at_threshold)

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stages that hold
permutation state, ``groupby`` / ``aggregate`` for the shuffle-wide steps.
"""

from nhse_probabilistic_linkage_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
