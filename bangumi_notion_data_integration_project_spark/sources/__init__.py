"""Connectors in: paginated REST source (offset + cursor pagination,
probe-and-prune, backoff) and the Bangumi collection flatten pipeline."""
