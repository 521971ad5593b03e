"""Host-side utilities: dataset IO, evaluation, synthetic data, f64 poses."""
