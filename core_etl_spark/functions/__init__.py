"""Column-expression function libraries (hex/u256 helpers)."""
