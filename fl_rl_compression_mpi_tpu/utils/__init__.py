"""Runtime utilities: timers/observability, chunking, native library loader."""
