"""Sources: the deterministic synthetic pages corpus + testdata readers."""
