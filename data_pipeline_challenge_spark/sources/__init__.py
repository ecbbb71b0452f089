"""Sources & sinks: landing zone, product-JSON normalization, ledger table."""
