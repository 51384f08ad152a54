"""mcmc subpackage."""
