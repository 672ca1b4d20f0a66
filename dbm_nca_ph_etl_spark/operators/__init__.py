"""Operator kernel: ordered/window transforms, dedup, similarity,
text analysis, multimodal plumbing — the engine's §2 inventory."""
