"""Training: losses, schedules, pjit data-parallel train steps, trainers."""
