"""Language API surface: the 15-function C ABI and its bindings."""
