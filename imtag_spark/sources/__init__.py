"""Data sources: seeded grid fixtures, synthetic source-code corpus, testdata loaders."""
