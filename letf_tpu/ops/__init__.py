"""Device compute ops: the fused path engine, rolling-window signals,
summary reductions, and Pallas kernels for the hot paths."""
