"""Sources and sinks: synthetic Common-Crawl-style pages, the reference's
edge-list text format, and rank/metrics sinks."""
