"""DataFrame-shaped operators: search (KNN/IVF/BM25/RRF), dedup families,
text statistics, top-k. All are pure DataFrame transformations — no RDDs,
no driver-side loops over collect()."""
