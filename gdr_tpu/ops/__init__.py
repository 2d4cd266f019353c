"""Retrieval ops: docid codec, trie tensors, masks, beam search, re-rank, k-means."""
