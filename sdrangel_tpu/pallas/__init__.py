"""Hand-tuned Pallas TPU kernels for the hot ops."""
