"""Asset ingestion: Radiance HDR and glTF loaders."""
