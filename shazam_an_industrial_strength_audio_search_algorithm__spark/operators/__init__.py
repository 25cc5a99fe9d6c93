"""Engine operators: index build, top-k query, WAND, maintenance,
dedup, similarity search, text analysis, multimodal plumbing."""
