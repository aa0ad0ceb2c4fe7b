"""Device ops: warp, det pre/post, CTC reduce, geometry, Pallas kernels."""
