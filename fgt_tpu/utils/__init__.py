"""Framework utilities: config merging, checkpoints, logging, timers."""
