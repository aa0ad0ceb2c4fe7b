"""Host runtime: C++ geometry library loader, micro-batcher."""
