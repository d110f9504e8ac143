"""Interop with the PyTorch reference: checkpoint conversion."""
