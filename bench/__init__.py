"""crawlspark benchmark scripts."""
