"""Corpus-scale operators beyond the reference's own surface.

The reference is a per-document tool; a 100 TB training-data pipeline also
needs corpus-level operators (task brief + SURVEY.md §7): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), text analysis (token
counting, quality scoring, language ID, fingerprinting), similarity
search over embeddings, windowed event aggregation, and the relational
verbs (broadcast + hash joins, grouped aggregates) they compose with.

Design rules applied throughout (ray_guide.md):
* pre-aggregate inside ``map_batches`` before any ``groupby`` shuffle;
* broadcast small sides with ``ray.put`` instead of shuffling;
* stay in Arrow/numpy/pandas kernels — no per-row Python in hot paths;
* every operator documents its shuffle keys and partitioning assumption.
"""
