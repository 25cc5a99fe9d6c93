"""Physical-plan introspection and audits."""
