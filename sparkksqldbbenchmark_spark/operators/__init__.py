"""Relational operators (SURVEY.md §2), each a pure DataFrame→DataFrame
function so Catalyst sees one logical plan end-to-end."""
