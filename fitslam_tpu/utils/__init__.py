"""Host utilities: config, profiling, logging, evaluation."""
