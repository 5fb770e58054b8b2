"""Text / training-data pipeline queries (dedup, quality, similarity).

Populated in build step 4 (SURVEY.md §7.2).
"""
