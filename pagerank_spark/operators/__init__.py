"""Graph + training-data-pipeline operators, all plain DataFrame compositions."""
