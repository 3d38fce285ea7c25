"""DataFrame -> DataFrame operators (the engine's physical layer)."""
