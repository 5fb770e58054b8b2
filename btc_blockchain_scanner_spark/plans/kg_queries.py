"""KG-construction queries (mentions → triples → linking → components).

Populated in build step 2-3 (SURVEY.md §7.1-7.2).
"""
