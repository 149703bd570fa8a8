"""Training-data curation walkthrough: the LLM-pipeline ops end-to-end.

    python examples/curate.py [sf_dir]

Over the documents + embeddings fixtures:
  1. schema-clean: stream only rows passing the document schema
  2. exact dedup (keep-first, broadcast-winner filter)
  3. near-dup sweep: MinHash canonical assignment (keep earliest of family)
  4. text analysis: language ID, quality, token counts, fingerprints
  5. vocabulary top-k
  6. ANN neighbor check over the embeddings table
Prints one summary line per stage.  Everything streams; the only driver
state is duplicate-rate- or k-bounded.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    import joi_ray as jr
    from joi_ray.ops.dedup import dedup_exact, minhash_canonical
    from joi_ray.ops.similarity import ann_topk
    from joi_ray.ops.text import lang_id_batch, quality_batch, token_count_batch, token_top_k
    from joi_ray.pipelines.validate import filter_valid

    t0 = time.time()
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    n_raw = docs.count()

    # 1. schema-clean
    schema = jr.object({
        "doc_id": jr.number().required(),
        "text": jr.string().required().min(20),
        "lang": jr.string().required(),
    })
    clean = filter_valid(docs, schema, normalize=True)
    n_clean = clean.count()
    print(f"[1] schema-clean      {n_raw} -> {n_clean} rows")

    # 2. exact dedup on a content prefix (fixture texts are unique in full)
    import pyarrow.compute as pc

    keyed = clean.map_batches(
        lambda t: t.append_column("key", pc.utf8_slice_codeunits(t["text"], 0, 16)),
        batch_format="pyarrow")
    kept = dedup_exact(keyed, "key", "doc_id")
    n_kept = kept.count()
    print(f"[2] exact dedup       {n_clean} -> {n_kept} rows (prefix key)")

    # 3. near-dup families
    canon = minhash_canonical(clean, "text", "doc_id")
    n_family = int((canon["doc_id"] != canon["canonical"]).sum()) if len(canon) else 0
    print(f"[3] minhash near-dup  {len(canon)} family members, {n_family} non-canonical")

    # 4. text analysis
    scored = (clean.map_batches(lang_id_batch, batch_format="pyarrow")
              .map_batches(quality_batch, batch_format="pyarrow")
              .map_batches(token_count_batch, batch_format="pyarrow"))
    stats = scored.map_batches(
        lambda t: __import__("pyarrow").table({
            "n": [t.num_rows],
            "toks": [pc.sum(t["ws_tokens"]).as_py()],
        }), batch_format="pyarrow").take_all()
    print(f"[4] text analysis     {sum(r['n'] for r in stats)} rows, "
          f"{sum(r['toks'] for r in stats)} whitespace tokens")

    # 5. vocabulary
    top = token_top_k(clean, "text", k=5).take_all()
    print(f"[5] top tokens        {[(r['token'], r['n']) for r in top]}")

    # 6. ANN sanity: each query's own vector is its top hit
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet")
    q = np.stack([np.asarray(emb["embedding"][i].as_py()) for i in (0, 3)])
    hits = ann_topk(rd.from_arrow(emb), q, k=3, concurrency=2).take_all()
    best = {}
    for r in hits:
        best.setdefault(r["query_id"], r["vec_id"])
    print(f"[6] ann top-1 per q   {best}")

    # 7. per-doc salient terms (tf-idf top-k)
    from joi_ray.ops.text import tfidf_top_terms

    tf = tfidf_top_terms(clean, "text", "doc_id", k=2)
    sample = tf.take(4)
    print(f"[7] tf-idf top terms  {[(r['doc_id'], r['term']) for r in sample]}")

    print(f"done in {time.time() - t0:.1f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
