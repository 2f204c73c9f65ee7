"""Training-data pipeline operators (beyond the reference's own surface):
text analysis, deduplication, similarity search, multimodal stages.
All are Ray-Data-first: vectorized map_batches stages + the minimum
number of shuffles, mirroring the patterns in moonray.merge."""
