"""DataFrame -> DataFrame relational operators."""
