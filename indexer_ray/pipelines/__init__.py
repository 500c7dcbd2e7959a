"""End-to-end pipelines: index build, query engines, dedup, ANN,
text analysis, multimodal plumbing."""
