"""Query registry: named DataFrame plans + equivalent ANSI-SQL oracles."""
