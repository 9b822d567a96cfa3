"""TPU-native ops: scan-based RNNs, Pallas kernels, fused attention."""
