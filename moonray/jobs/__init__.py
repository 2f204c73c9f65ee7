"""``ray job submit`` entry points — see ``python -m moonray.jobs --help``."""
