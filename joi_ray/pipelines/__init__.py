"""Ray Data pipelines: full validation pass, uniqueness, stats, drift."""
