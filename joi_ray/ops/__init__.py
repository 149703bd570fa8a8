"""Large-scale training-data operations: dedup, similarity, text analysis,
multimodal stages.  All are Ray-Data-first: vectorized map_batches kernels,
actor pools for stateful stages, pre-aggregated shuffles."""
