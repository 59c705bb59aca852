"""Numpy/pandas kernels and DataFrame-level operators (detection, recognition,
builder, dedup, similarity). All kernels are batch-vectorized and side-effect
free so they can run inside Arrow-batched pandas UDF stages."""
