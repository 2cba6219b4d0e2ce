"""Host utilities: timers, image preprocessing, weights IO, numpy oracles."""
