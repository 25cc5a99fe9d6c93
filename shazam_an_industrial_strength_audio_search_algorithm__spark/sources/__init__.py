"""Sources & sinks: synthetic corpus, catalog helpers, snapshot store."""
