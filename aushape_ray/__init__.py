"""Ray-Data-native audit-event shaping engine (aushape semantics, rebuilt)."""
