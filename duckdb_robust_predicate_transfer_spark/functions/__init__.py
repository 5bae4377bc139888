"""Column-function helpers shared by operators and workload queries."""
