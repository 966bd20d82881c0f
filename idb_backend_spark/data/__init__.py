"""Vocabulary data tables (public standards content; see tools/gen_vocab_tables.py)."""
