"""Host-side I/O: parsers for the reference benchmark input formats and
padding/bucketing into fixed-shape device batches."""
