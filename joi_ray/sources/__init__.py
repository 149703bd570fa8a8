"""Sources: deterministic interleaved-document synthesis and readers."""
