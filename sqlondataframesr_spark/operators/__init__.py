"""Reusable relational operators that the reference exercises but
Spark SQL spells differently (SURVEY.md §2.3's argmax family, §2.4's
semi-join form, …). Each operator is a plain DataFrame -> DataFrame
combinator so Catalyst sees through it."""
