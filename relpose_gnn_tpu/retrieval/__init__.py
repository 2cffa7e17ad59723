"""Image retrieval: descriptor indices and neighbor subsampling."""
