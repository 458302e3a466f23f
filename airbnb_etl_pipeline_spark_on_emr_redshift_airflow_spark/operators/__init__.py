"""Relational / join / window / aggregate / dedup / similarity operators."""
