"""Index building (embed + k-means + trie) and no-retrain expansion."""
