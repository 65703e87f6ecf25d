from vitiq.data.synthetic import generate_test_signal, SyntheticAMCDataset  # noqa: F401
