"""diagnostics subpackage."""
