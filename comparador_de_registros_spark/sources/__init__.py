"""Sources & sinks: catalog abstraction + synthetic transcript generator."""
