"""Independent pandas/numpy oracle for the rollup engine (SURVEY.md §5.1).

Implements the DESIGN.md contract with no code shared with the Spark engine;
every Spark output is compared bit-exactly against this module.
"""
