"""Training: CTC/DB trainers and synthetic data rendering."""
