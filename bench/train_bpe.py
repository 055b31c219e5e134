"""Regenerate the vendored BPE merge table (pagerank_ray/functions/bpe_merges.txt).

Trains Sennrich-2016 merges on the deterministic sf0.001 synthetic documents
corpus. The cap (40 merges) is deliberate: the synthetic vocabulary is tiny
(31 space-split words), and a large table would collapse every word to a
single token — making bpe_token_counts degenerate to a word count and
rubber-stamping any merge-loop bug (the converged-label-propagation oracle
trap). At 40 merges most words still split into 2+ subword tokens, so the
engine/oracle hash compares real merge behavior.

Run:  python bench/train_bpe.py [sf_dir] [n_merges]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq

from pagerank_ray.functions.bpe import MERGES_PATH, train_bpe

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 40
texts = pq.read_table(os.path.join(sf, "documents.parquet"), columns=["text"])
merges = train_bpe(texts.column("text").to_pylist(), n_merges)
with open(MERGES_PATH, "w", encoding="utf-8") as f:
    f.write(f"# BPE merges trained by bench/train_bpe.py on {os.path.basename(sf)} "
            f"documents (Sennrich et al. 2016), n_merges={n_merges}\n")
    for a, b in merges:
        f.write(f"{a} {b}\n")
print(f"wrote {len(merges)} merges to {MERGES_PATH}")
