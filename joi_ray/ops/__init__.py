"""Large-scale training-data operations: dedup, similarity, text analysis,
multimodal stages.

These have NO analog in the reference — @hapi/joi contains no cross-record
operators at all (SURVEY.md §2.6: joins, aggregations, dedup, sampling and
windows are "absent by construction"); they exist to satisfy the north
rule's dataset-level requirements.  All are Ray-Data-first: vectorized
map_batches kernels, actor pools or cached-task stages for stateful work,
pre-aggregated shuffles.
"""
