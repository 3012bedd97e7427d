from semtpu.export.artifact import export_unet, load_artifact, ExportedModel
