"""Job planners: pure-Python planning over (small) metadata, executed by Spark."""
