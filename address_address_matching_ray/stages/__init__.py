"""Dataset stage callables (classes for actor pools, fns for tasks)."""
