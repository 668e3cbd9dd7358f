"""App layer: message structs, node loops, benchmark harness."""
