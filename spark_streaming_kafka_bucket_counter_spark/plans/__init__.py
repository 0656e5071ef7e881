"""Named-query catalog: the driver-facing inventory of implemented operators."""
